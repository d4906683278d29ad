/**
 * Component plumbing: every public component renders a host element of
 * type "smelter" carrying its sceneBuilder + serializable props; the
 * reconciler in smelter-core walks those host instances and calls the
 * builders to produce wire-format scene JSON.
 *
 * Mirrors the reference's ts/smelter/src/component.ts contract
 * (createSmelterComponent / SceneBuilder / sceneComponentIntoApi).
 */
import type React from 'react';
import { createElement, useId } from 'react';
import type * as Api from './api.js';

export const DEFAULT_FONT_SIZE = 50;

export type ComponentBaseProps = {
  /** Component children. */
  children?: React.ReactNode;
  /** Id of a component. */
  id?: Api.ComponentId;
};

export type SceneComponent = Api.Component | string;
export type SceneBuilder<P> = (props: P, children: SceneComponent[]) => Api.Component;

export function createSmelterComponent<P extends ComponentBaseProps>(
  sceneBuilder: SceneBuilder<P>
): (props: P) => React.ReactNode {
  return (props: P): React.ReactNode => {
    const { children, ...rest } = props;
    const reactAssignedId = useId();
    const childArray = Array.isArray(children) ? children : [children];
    return createElement(
      'smelter',
      {
        sceneBuilder,
        props: { ...rest, id: rest.id ?? reactAssignedId },
      },
      ...childArray
    );
  };
}

/** Bare strings inside a layout become Text nodes with the default size. */
export function sceneComponentIntoApi(component: SceneComponent): Api.Component {
  if (typeof component === 'string') {
    return { type: 'text', text: component, font_size: DEFAULT_FONT_SIZE };
  }
  return component;
}
